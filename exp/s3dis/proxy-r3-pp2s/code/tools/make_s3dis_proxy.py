"""Procedural S3DIS-like dataset generator ("s3dis_proxy").

The build environment has no real S3DIS download, so the end-to-end
training proof (VERDICT.md next-round item #1) runs on the densest
feasible proxy: procedurally generated indoor rooms with the 13 S3DIS
classes, realistic per-class geometry (planar shells, furniture
assemblies, wall fixtures), class/instance-correlated colors with scan
noise and lighting, and per-point analytic normals. Labels are
predictable from geometry+color — so a training run produces a
meaningful mIoU curve that validates the full stack (GridSample
semantics, approximate kNN, capacity-bounded pooling, masked BN, the
evaluator's origin-coord re-projection) — while room statistics (point
counts, surface densities, class imbalance) match real S3DIS rooms
after 0.04 m grid sampling.

Output layout mirrors the reference preprocessing
(/root/reference/pointcept/datasets/preprocessing/s3dis/preprocess_s3dis.py:36-248):
one scene file per room under ``<out>/<Area_X>/<room>.npz`` holding
``coord / color / normal / semantic_gt / instance_gt``.

Usage:
    python tools/make_s3dis_proxy.py --out data/s3dis_proxy \
        --rooms-per-area 12 --val-rooms 8 [--seed 0]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

# S3DIS class ids (reference: configs/s3dis/*.py `names`)
CEILING, FLOOR, WALL, BEAM, COLUMN, WINDOW, DOOR = 0, 1, 2, 3, 4, 5, 6
TABLE, CHAIR, SOFA, BOOKCASE, BOARD, CLUTTER = 7, 8, 9, 10, 11, 12

# per-class base color palettes (RGB 0-255); chosen to overlap across
# classes (wall/ceiling/door/board all near-neutral) so color alone does
# not separate classes — geometry must carry most of the signal.
PALETTES = {
    CEILING: [(235, 233, 228), (225, 225, 222), (240, 238, 235)],
    FLOOR: [(160, 140, 110), (130, 120, 112), (170, 165, 158), (96, 88, 80)],
    WALL: [(226, 220, 208), (210, 206, 198), (232, 228, 220), (198, 192, 180)],
    BEAM: [(220, 216, 208), (200, 198, 192)],
    COLUMN: [(218, 214, 206), (204, 200, 194)],
    WINDOW: [(120, 140, 160), (90, 110, 130), (150, 165, 180)],
    DOOR: [(150, 110, 70), (120, 85, 55), (185, 150, 105), (205, 200, 192)],
    TABLE: [(165, 125, 85), (140, 105, 70), (190, 185, 178), (110, 95, 80)],
    CHAIR: [(60, 60, 70), (120, 40, 40), (70, 90, 130), (150, 120, 90)],
    SOFA: [(110, 60, 60), (70, 80, 110), (90, 90, 90), (140, 110, 80)],
    BOOKCASE: [(145, 105, 70), (120, 90, 60), (95, 75, 55)],
    BOARD: [(245, 245, 242), (60, 90, 75), (240, 240, 238)],
    CLUTTER: None,  # random
}


class RoomBuilder:
    """Accumulates labelled surface samples for one room."""

    def __init__(self, rng: np.random.Generator, density: float):
        self.rng = rng
        self.density = density  # points per m^2
        self.coords, self.colors, self.normals = [], [], []
        self.labels, self.instances = [], []
        self.next_instance = 0

    # ---- low-level samplers -------------------------------------------

    def _n_for_area(self, area: float) -> int:
        lam = max(area * self.density, 1.0)
        return int(self.rng.poisson(lam))

    def rect(self, origin, u_vec, v_vec, label, color, instance,
             holes=None, jitter=0.004):
        """Sample a planar rectangle spanned by u_vec/v_vec from origin.

        ``holes``: list of (u0, u1, v0, v1) fractions to cut out
        (door/window openings in walls).
        """
        origin = np.asarray(origin, np.float32)
        u_vec = np.asarray(u_vec, np.float32)
        v_vec = np.asarray(v_vec, np.float32)
        area = np.linalg.norm(u_vec) * np.linalg.norm(v_vec)
        n = self._n_for_area(area)
        if n == 0:
            return
        u = self.rng.uniform(0, 1, n).astype(np.float32)
        v = self.rng.uniform(0, 1, n).astype(np.float32)
        if holes:
            keep = np.ones(n, bool)
            for (u0, u1, v0, v1) in holes:
                keep &= ~((u >= u0) & (u <= u1) & (v >= v0) & (v <= v1))
            u, v = u[keep], v[keep]
            n = u.shape[0]
            if n == 0:
                return
        pts = origin + u[:, None] * u_vec + v[:, None] * v_vec
        normal = np.cross(u_vec, v_vec)
        normal = normal / (np.linalg.norm(normal) + 1e-9)
        pts = pts + normal * self.rng.normal(0, jitter, (n, 1)).astype(np.float32)
        self._push(pts, normal, label, color, instance, n)

    def box(self, center, size, label, color, instance, faces="all"):
        """Sample the surface of an axis-aligned box.

        faces: "all", "no_bottom" (furniture standing on the floor),
        or an iterable of face names from
        {x-, x+, y-, y+, z-, z+}.
        """
        center = np.asarray(center, np.float32)
        size = np.asarray(size, np.float32)
        half = size / 2
        all_faces = {
            "x-": (np.array([-1, 0, 0]), size[1] * size[2]),
            "x+": (np.array([1, 0, 0]), size[1] * size[2]),
            "y-": (np.array([0, -1, 0]), size[0] * size[2]),
            "y+": (np.array([0, 1, 0]), size[0] * size[2]),
            "z-": (np.array([0, 0, -1]), size[0] * size[1]),
            "z+": (np.array([0, 0, 1]), size[0] * size[1]),
        }
        if faces == "all":
            face_names = list(all_faces)
        elif faces == "no_bottom":
            face_names = [f for f in all_faces if f != "z-"]
        else:
            face_names = list(faces)
        for name in face_names:
            normal, area = all_faces[name]
            n = self._n_for_area(area)
            if n == 0:
                continue
            axis = "xyz".index(name[0])
            sign = 1.0 if name[1] == "+" else -1.0
            pts = self.rng.uniform(-1, 1, (n, 3)).astype(np.float32) * half
            pts[:, axis] = sign * half[axis]
            pts = pts + center
            pts = pts + normal[None].astype(np.float32) * self.rng.normal(
                0, 0.004, (n, 1)
            ).astype(np.float32)
            self._push(pts, normal.astype(np.float32), label, color, instance, n)

    def blob(self, center, radius, label, color, instance, n=None):
        """Irregular clutter blob (ellipsoid-ish point cluster)."""
        center = np.asarray(center, np.float32)
        if n is None:
            n = self._n_for_area(4 * np.pi * radius * radius * 1.5)
        if n == 0:
            return
        d = self.rng.normal(0, 1, (n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True) + 1e-9
        r = radius * np.abs(self.rng.normal(0.8, 0.25, (n, 1))).astype(np.float32)
        scale = self.rng.uniform(0.5, 1.2, (1, 3)).astype(np.float32)
        pts = center + d * r * scale
        self._push(pts, d, label, color, instance, n)

    def _push(self, pts, normal, label, color, instance, n):
        self.coords.append(pts.astype(np.float32))
        if np.ndim(normal) == 1:
            normal = np.broadcast_to(normal.astype(np.float32), (n, 3))
        self.normals.append(np.asarray(normal, np.float32).reshape(n, 3))
        base = np.asarray(color, np.float32)
        # per-point texture noise
        col = base + self.rng.normal(0, 9.0, (n, 3)).astype(np.float32)
        self.colors.append(col)
        self.labels.append(np.full(n, label, np.int16))
        self.instances.append(np.full(n, instance, np.int16))

    # ---- helpers -------------------------------------------------------

    def new_instance(self) -> int:
        i = self.next_instance
        self.next_instance += 1
        return i

    def pick_color(self, label) -> np.ndarray:
        pal = PALETTES[label]
        if pal is None:
            return self.rng.uniform(30, 225, 3).astype(np.float32)
        base = np.asarray(pal[self.rng.integers(len(pal))], np.float32)
        return base + self.rng.normal(0, 12.0, 3).astype(np.float32)

    def finish(self, room_h: float):
        coord = np.concatenate(self.coords)
        color = np.concatenate(self.colors)
        normal = np.concatenate(self.normals)
        segment = np.concatenate(self.labels)
        instance = np.concatenate(self.instances)
        # height-dependent lighting + slight directional shading
        light = 0.78 + 0.22 * np.clip(coord[:, 2] / room_h, 0, 1)
        shade = 0.95 + 0.05 * normal[:, 2]
        color = np.clip(color * (light * shade)[:, None], 0, 255)
        order = self.rng.permutation(coord.shape[0])
        return dict(
            coord=coord[order],
            color=color[order].astype(np.float32),
            normal=normal[order],
            semantic_gt=segment[order].astype(np.int16),
            instance_gt=instance[order].astype(np.int16),
        )


def _uniform_safe(rng, lo, hi):
    """uniform(lo, hi), degrading to the midpoint when the range collapses
    (narrow hallway rooms)."""
    if hi <= lo:
        return 0.5 * (lo + hi)
    return rng.uniform(lo, hi)


def _furnish_table(b: RoomBuilder, rng, x, y):
    tw = rng.uniform(1.1, 2.0)
    td = rng.uniform(0.6, 1.0)
    th = rng.uniform(0.70, 0.78)
    inst = b.new_instance()
    col = b.pick_color(TABLE)
    b.box((x, y, th - 0.02), (tw, td, 0.04), TABLE, col, inst, "no_bottom")
    for sx in (-1, 1):
        for sy in (-1, 1):
            b.box(
                (x + sx * (tw / 2 - 0.05), y + sy * (td / 2 - 0.05), th / 2 - 0.02),
                (0.06, 0.06, th - 0.04),
                TABLE, col * 0.85, inst, "all",
            )
    return (x, y, tw, td, th)


def _furnish_chair(b: RoomBuilder, rng, x, y, angle_to=None):
    inst = b.new_instance()
    col = b.pick_color(CHAIR)
    seat_h = rng.uniform(0.42, 0.48)
    b.box((x, y, seat_h), (0.42, 0.42, 0.05), CHAIR, col, inst, "no_bottom")
    # backrest on a random side (or facing a table)
    side = rng.integers(4) if angle_to is None else angle_to
    dx = [0.2, -0.2, 0, 0][side]
    dy = [0, 0, 0.2, -0.2][side]
    sz = (0.05, 0.42, 0.45) if side < 2 else (0.42, 0.05, 0.45)
    b.box((x + dx, y + dy, seat_h + 0.25), sz, CHAIR, col, inst, "all")
    for sx in (-1, 1):
        for sy in (-1, 1):
            b.box((x + sx * 0.17, y + sy * 0.17, seat_h / 2), (0.04, 0.04, seat_h),
                  CHAIR, col * 0.8, inst, "all")


def generate_room(seed: int, room_type: str = "office") -> dict:
    """Build one labelled room. room_type in {office, conference, hallway,
    storage} controls furniture statistics."""
    rng = np.random.default_rng(seed)
    w = rng.uniform(5.0, 10.0)
    d = rng.uniform(4.0, 8.0)
    h = rng.uniform(2.6, 3.4)
    if room_type == "hallway":
        w, d = rng.uniform(8.0, 14.0), rng.uniform(1.8, 3.0)
    density = rng.uniform(650.0, 1000.0)
    b = RoomBuilder(rng, density)

    # ---- shell ----------------------------------------------------------
    b.rect((0, 0, 0), (w, 0, 0), (0, d, 0), FLOOR, b.pick_color(FLOOR),
           b.new_instance())
    b.rect((0, 0, h), (w, 0, 0), (0, d, 0), CEILING, b.pick_color(CEILING),
           b.new_instance())

    # walls: (origin, u along wall, wall length, inward axis)
    walls = [
        ((0, 0, 0), np.array([1.0, 0, 0]), w, np.array([0, 1.0, 0])),
        ((0, d, 0), np.array([1.0, 0, 0]), w, np.array([0, -1.0, 0])),
        ((0, 0, 0), np.array([0, 1.0, 0]), d, np.array([1.0, 0, 0])),
        ((w, 0, 0), np.array([0, 1.0, 0]), d, np.array([-1.0, 0, 0])),
    ]
    wall_color = b.pick_color(WALL)
    n_doors = 1 + int(rng.uniform() < 0.35)
    n_windows = rng.integers(0, 4)
    n_boards = rng.integers(0, 3)

    fixtures = []  # (wall_idx, u0_frac, u1_frac, v0_frac, v1_frac, kind)
    def try_place(kind, width, z0, z1):
        for _ in range(8):
            wi = int(rng.integers(4))
            origin, u_dir, length, _inward = walls[wi]
            if length < width + 0.6:
                continue
            u0 = rng.uniform(0.3, length - width - 0.3) / length
            u1 = u0 + width / length
            v0, v1 = z0 / h, z1 / h
            ok = all(
                not (fwi == wi and u0 < fu1 + 0.05 and fu0 - 0.05 < u1)
                for (fwi, fu0, fu1, _, _, _) in fixtures
            )
            if ok:
                fixtures.append((wi, u0, u1, v0, v1, kind))
                return True
        return False

    for _ in range(n_doors):
        try_place(DOOR, rng.uniform(0.9, 1.2), 0.0, rng.uniform(2.0, 2.2))
    for _ in range(n_windows):
        z0 = rng.uniform(0.8, 1.1)
        try_place(WINDOW, rng.uniform(1.0, 2.2), z0, z0 + rng.uniform(0.9, 1.4))
    for _ in range(n_boards):
        z0 = rng.uniform(0.8, 1.2)
        try_place(BOARD, rng.uniform(1.2, 2.6), z0, z0 + rng.uniform(0.9, 1.2))

    for wi, (origin, u_dir, length, inward) in enumerate(walls):
        holes = [
            (u0, u1, v0, v1)
            for (fwi, u0, u1, v0, v1, kind) in fixtures
            if fwi == wi and kind in (DOOR, WINDOW)
        ]
        b.rect(origin, u_dir * length, (0, 0, h), WALL, wall_color,
               b.new_instance(), holes=holes)

    # fixtures as slightly-recessed/proud panels
    for (wi, u0, u1, v0, v1, kind) in fixtures:
        origin, u_dir, length, inward = walls[wi]
        off = 0.03 if kind != WINDOW else -0.04
        o = (np.asarray(origin, np.float32)
             + u_dir * (u0 * length)
             + inward * off
             + np.array([0, 0, v0 * h], np.float32))
        b.rect(o, u_dir * ((u1 - u0) * length), (0, 0, (v1 - v0) * h),
               kind, b.pick_color(kind), b.new_instance())

    # ---- structure: beams / columns -------------------------------------
    if rng.uniform() < 0.5:
        for _ in range(int(rng.integers(1, 3))):
            y = rng.uniform(0.2 * d, 0.8 * d)
            b.box((w / 2, y, h - 0.15), (w, 0.28, 0.3), BEAM,
                  b.pick_color(BEAM), b.new_instance(),
                  faces=("z-", "y-", "y+"))
    if rng.uniform() < 0.5:
        for _ in range(int(rng.integers(1, 3))):
            cx = rng.choice([0.18, w - 0.18])
            cy = rng.uniform(0.2 * d, 0.8 * d)
            b.box((cx, cy, h / 2), (0.35, 0.35, h), COLUMN,
                  b.pick_color(COLUMN), b.new_instance(),
                  faces=("x-", "x+", "y-", "y+"))

    # ---- furniture -------------------------------------------------------
    counts = {
        "office": dict(tables=(1, 4), chairs=(2, 7), sofas=(0, 2),
                       bookcases=(1, 4), clutter=(10, 24)),
        "conference": dict(tables=(1, 2), chairs=(6, 12), sofas=(0, 1),
                           bookcases=(0, 2), clutter=(6, 16)),
        "hallway": dict(tables=(0, 1), chairs=(0, 2), sofas=(0, 2),
                        bookcases=(0, 2), clutter=(3, 10)),
        "storage": dict(tables=(0, 2), chairs=(0, 2), sofas=(0, 1),
                        bookcases=(2, 6), clutter=(14, 30)),
    }[room_type]

    def nrand(key):
        lo, hi = counts[key]
        return int(rng.integers(lo, hi + 1))

    tables = []
    for _ in range(nrand("tables")):
        x = _uniform_safe(rng, 1.2, w - 1.2)
        y = _uniform_safe(rng, 1.2, d - 1.2)
        tables.append(_furnish_table(b, rng, x, y))
    for _ in range(nrand("chairs")):
        if tables and rng.uniform() < 0.7:
            tx, ty, tw_, td_, _ = tables[rng.integers(len(tables))]
            x = tx + rng.uniform(-tw_ / 2 - 0.3, tw_ / 2 + 0.3)
            y = ty + rng.choice([-1, 1]) * (td_ / 2 + rng.uniform(0.25, 0.45))
        else:
            x = _uniform_safe(rng, 0.6, w - 0.6)
            y = _uniform_safe(rng, 0.6, d - 0.6)
        _furnish_chair(b, rng, x, y)
    for _ in range(nrand("sofas")):
        inst = b.new_instance()
        col = b.pick_color(SOFA)
        sw = rng.uniform(1.5, 2.2)
        x = _uniform_safe(rng, sw / 2 + 0.3, w - sw / 2 - 0.3)
        y = rng.choice([0.55, d - 0.55])
        b.box((x, y, 0.28), (sw, 0.85, 0.52), SOFA, col, inst, "no_bottom")
        back_y = y + (0.32 if y < d / 2 else -0.32)
        b.box((x, back_y, 0.62), (sw, 0.22, 0.75), SOFA, col, inst, "no_bottom")
        for sx in (-1, 1):
            b.box((x + sx * (sw / 2 - 0.1), y, 0.42), (0.2, 0.85, 0.6),
                  SOFA, col, inst, "no_bottom")
    for _ in range(nrand("bookcases")):
        inst = b.new_instance()
        col = b.pick_color(BOOKCASE)
        bw = rng.uniform(0.8, 1.4)
        bh = rng.uniform(1.7, 2.2)
        against = int(rng.integers(4))
        if against < 2:
            x = _uniform_safe(rng, bw / 2 + 0.2, w - bw / 2 - 0.2)
            y = 0.17 if against == 0 else d - 0.17
            size = (bw, 0.32, bh)
        else:
            x = 0.17 if against == 2 else w - 0.17
            y = _uniform_safe(rng, bw / 2 + 0.2, d - bw / 2 - 0.2)
            size = (0.32, bw, bh)
        b.box((x, y, bh / 2), size, BOOKCASE, col, inst, "no_bottom")
        # books as clutter blobs on shelf heights
        for shelf_z in np.arange(0.35, bh - 0.15, rng.uniform(0.35, 0.45)):
            if rng.uniform() < 0.75:
                b.blob((x, y, shelf_z), 0.16, CLUTTER,
                       b.pick_color(CLUTTER), b.new_instance())
    for _ in range(nrand("clutter")):
        if tables and rng.uniform() < 0.5:
            tx, ty, tw_, td_, th_ = tables[rng.integers(len(tables))]
            c = (tx + rng.uniform(-tw_ / 3, tw_ / 3),
                 ty + rng.uniform(-td_ / 3, td_ / 3), th_ + 0.1)
            r = rng.uniform(0.06, 0.16)
        else:
            c = (_uniform_safe(rng, 0.4, w - 0.4), _uniform_safe(rng, 0.4, d - 0.4),
                 rng.uniform(0.08, 0.4))
            r = rng.uniform(0.08, 0.3)
        b.blob(c, r, CLUTTER, b.pick_color(CLUTTER), b.new_instance())

    return b.finish(h)


ROOM_TYPES = ["office", "office", "office", "conference", "hallway", "storage"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/s3dis_proxy")
    ap.add_argument("--rooms-per-area", type=int, default=12)
    ap.add_argument("--val-rooms", type=int, default=8,
                    help="rooms in Area_5 (the held-out split)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    areas = {f"Area_{i}": args.rooms_per_area for i in (1, 2, 3, 4, 6)}
    areas["Area_5"] = args.val_rooms
    total_pts = 0
    for ai, (area, n_rooms) in enumerate(sorted(areas.items())):
        out_dir = os.path.join(args.out, area)
        os.makedirs(out_dir, exist_ok=True)
        for r in range(n_rooms):
            rng = np.random.default_rng(args.seed * 7919 + ai * 1009 + r)
            room_type = ROOM_TYPES[int(rng.integers(len(ROOM_TYPES)))]
            seed = int(rng.integers(2**31))
            data = generate_room(seed, room_type)
            name = f"{room_type}_{r + 1}"
            np.savez(os.path.join(out_dir, name + ".npz"), **data)
            total_pts += data["coord"].shape[0]
            print(f"{area}/{name}: {data['coord'].shape[0]} pts")
    print(f"total: {total_pts} points")


if __name__ == "__main__":
    main()
