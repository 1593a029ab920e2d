"""Scene flattening: scenegraph -> flat HBM-resident world-space arrays.

TPU-native replacement for the reference's MegaHeap + MeshAggregate BLAS/TLAS
(crates/akari_render/src/{heap.rs,mesh.rs:220-333}): instead of bindless
buffers + a two-level hardware BVH over instanced meshes, we bake instance
transforms into one flat world-space triangle soup at load time and address
everything with integer ids — the natural layout for XLA gathers.

Per-corner attributes (normals/uvs/tangents are per-loop in the scenegraph,
matching Blender split attributes — ref mesh.rs:536-599) are interpolated at
hit points from [T, 3, k] arrays.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np

from ..core.math import normalize
from ..scenegraph.model import SceneGraph, load_transform


class TriangleSoup(NamedTuple):
    """Host-side (numpy) flattened geometry, before device upload."""

    v0: np.ndarray  # [T, 3]
    e1: np.ndarray  # [T, 3] v1 - v0
    e2: np.ndarray  # [T, 3] v2 - v0
    ng: np.ndarray  # [T, 3] world geometric normal (normalized)
    area: np.ndarray  # [T]   world-space area
    ns: np.ndarray  # [T, 3, 3] per-corner world shading normals
    uv: np.ndarray  # [T, 3, 2] per-corner uvs
    inst_id: np.ndarray  # [T] u32
    mat_id: np.ndarray  # [T] u32 index into scene material list (resolved slot)


def flatten_scene(sg: SceneGraph) -> tuple[TriangleSoup, list[str], list[dict]]:
    """Flatten all instances to world space.

    Returns (soup, material_ids, instance_info) where material_ids is the
    ordered list of material node names (mat_id indexes it) and instance_info
    carries per-instance metadata for light building.
    """
    mat_name_to_idx: dict[str, int] = {}
    mat_names: list[str] = []

    def mat_idx(name: str) -> int:
        if name not in mat_name_to_idx:
            mat_name_to_idx[name] = len(mat_names)
            mat_names.append(name)
        return mat_name_to_idx[name]

    chunks = {k: [] for k in TriangleSoup._fields}
    instance_info = []
    tri_base = 0
    for iid, (inst_name, inst) in enumerate(sg.instances.items()):
        mesh = sg.mesh_arrays(inst["geometry"]["id"])
        m = load_transform(inst["transform"], is_camera=False)
        m3 = m[:3, :3]
        t3 = m[:3, 3]
        det = float(np.linalg.det(m3))
        m_inv_t = np.linalg.inv(m3).T if abs(det) > 1e-20 else np.eye(3)

        verts = mesh["vertices"].astype(np.float64)
        idx = mesh["indices"].astype(np.int64)
        ntri = len(idx)
        v0l, v1l, v2l = verts[idx[:, 0]], verts[idx[:, 1]], verts[idx[:, 2]]
        ngl = np.cross(v1l - v0l, v2l - v0l)
        len_l = np.linalg.norm(ngl, axis=-1, keepdims=True)
        area_l = len_l[:, 0] * 0.5
        ngl = ngl / np.maximum(len_l, 1e-30)

        v0 = v0l @ m3.T + t3
        v1 = v1l @ m3.T + t3
        v2 = v2l @ m3.T + t3
        ng = ngl @ m_inv_t.T
        ng_len = np.linalg.norm(ng, axis=-1, keepdims=True)
        ng = ng / np.maximum(ng_len, 1e-30)
        # world area = local area * det / (ng_world . (M ng_local))  (mesh.rs:604-629)
        c = ngl @ m3.T
        denom = (ng * c).sum(-1)
        area = np.where(
            (area_l == 0.0) | (det == 0.0), 0.0, np.abs(area_l * det / np.where(denom == 0, 1, denom))
        )

        # per-corner shading normals (per-loop layout: [3*T, 3])
        if mesh["normals"] is not None:
            nsl = mesh["normals"].astype(np.float64).reshape(ntri, 3, 3)
            ns = nsl @ m_inv_t.T
            ns = ns / np.maximum(np.linalg.norm(ns, axis=-1, keepdims=True), 1e-30)
        else:
            ns = np.repeat(ng[:, None, :], 3, axis=1)

        if mesh["uvs"] is not None:
            uv = mesh["uvs"].astype(np.float32).reshape(ntri, 3, 2)
        else:
            # default uvs (mesh.rs:541-546)
            uv = np.broadcast_to(
                np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 0.1]], np.float32), (ntri, 3, 2)
            ).copy()

        # resolve per-prim material slots -> global material index.
        # The materials buffer holds per-prim slot indices only for
        # multi-material meshes (ref mesh.rs:509-519 HAS_MULTI_MATERIALS);
        # single-material meshes store a single slot entry.
        slots = [mat_idx(mref["id"]) for mref in inst["materials"]]
        slot_arr = np.asarray(slots if slots else [0], np.uint32)
        raw = mesh["materials"].astype(np.int64)
        if len(raw) == ntri:
            prim_slots = raw
        elif len(raw) >= 1:
            prim_slots = np.full(ntri, raw[0], np.int64)
        else:
            prim_slots = np.zeros(ntri, np.int64)
        prim_slots = np.clip(prim_slots, 0, len(slot_arr) - 1)
        tri_mat = slot_arr[prim_slots]

        chunks["v0"].append(v0.astype(np.float32))
        chunks["e1"].append((v1 - v0).astype(np.float32))
        chunks["e2"].append((v2 - v0).astype(np.float32))
        chunks["ng"].append(ng.astype(np.float32))
        chunks["area"].append(area.astype(np.float32))
        chunks["ns"].append(ns.astype(np.float32))
        chunks["uv"].append(uv.astype(np.float32))
        chunks["inst_id"].append(np.full(ntri, iid, np.uint32))
        chunks["mat_id"].append(tri_mat.astype(np.uint32))

        instance_info.append(
            {
                "name": inst_name,
                "tri_start": tri_base,
                "tri_count": ntri,
                "materials": [mref["id"] for mref in inst["materials"]],
            }
        )
        tri_base += ntri

    soup = TriangleSoup(**{k: np.concatenate(v, axis=0) for k, v in chunks.items()})
    return soup, mat_names, instance_info
