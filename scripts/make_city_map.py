#!/usr/bin/env python3
"""Generate a MovingAI-format 256x256 city map + scenario file.

The reference's MovingAI experiments run Berlin_0_256.map from bench-mr's
scenario bundle (notebooks/benchmark/movingai_experiment.ipynb cell 2/4); the
bundle is a git submodule that isn't vendored, so this generates a faithful
city-style map instead: blocked building blocks cut by a connected street
grid with randomized spacing/widths, diagonal avenues, and open plazas — the
structure class the Berlin city maps exercise (narrow corridors meeting wide
open space at 256x256 scale). Deterministic for a given seed.

The .scen entries carry true geodesic optimal lengths (octile metric, computed
with our wavefront distance field on the raw grid) like real MovingAI files.

    python scripts/make_city_map.py --out assets/movingai --seed 0
"""
from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

SIZE = 256


def city_grid(seed: int) -> np.ndarray:
    """[SIZE, SIZE] bool: True = blocked (building), False = street."""
    rng = np.random.RandomState(seed)
    blocked = np.ones((SIZE, SIZE), bool)

    def carve_rows(positions, widths):
        for p, w in zip(positions, widths):
            blocked[max(0, p) : min(SIZE, p + w), :] = False

    def carve_cols(positions, widths):
        for p, w in zip(positions, widths):
            blocked[:, max(0, p) : min(SIZE, p + w)] = False

    # street grid: randomized spacing 14-24, width 3-6
    rows, p = [], rng.randint(4, 12)
    while p < SIZE - 4:
        rows.append(p)
        p += rng.randint(14, 25)
    cols, p = [], rng.randint(4, 12)
    while p < SIZE - 4:
        cols.append(p)
        p += rng.randint(14, 25)
    carve_rows(rows, rng.randint(3, 7, len(rows)))
    carve_cols(cols, rng.randint(3, 7, len(cols)))

    # two diagonal avenues (width ~5), like Berlin's cut-throughs
    ii = np.arange(SIZE)
    for sign, offset in ((1, rng.randint(-30, 30)), (-1, rng.randint(226, 286))):
        jj = sign * ii + offset
        for d in range(-2, 3):
            j = np.clip(jj + d, 0, SIZE - 1)
            keep = (jj + d >= 0) & (jj + d < SIZE)
            blocked[ii[keep], j[keep]] = False

    # open plazas: a few free rectangles
    for _ in range(6):
        ci, cj = rng.randint(20, SIZE - 20, 2)
        hi, hj = rng.randint(8, 18, 2)
        blocked[ci - hi : ci + hi, cj - hj : cj + hj] = False

    # interior courtyards: small blocked islands inside plazas stay blocked
    # (already true — carving only frees cells)
    return blocked


def make_scen_entries(blocked: np.ndarray, map_name: str, count: int,
                      seed: int) -> list[str]:
    """Scenario lines with true octile-geodesic optimal lengths."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from nfopp_tpu.astar.wavefront import distance_field
    from nfopp_tpu.worlds.scenarios import dilate

    rng = np.random.RandomState(seed + 1)
    # endpoints keep 2 cells of clearance so footprint-dilated planning stays
    # solvable (the reference's exit-3/4 situation)
    free_i, free_j = np.where(~dilate(blocked, 2))
    dfield = jax.jit(distance_field)
    lines = []
    while len(lines) < count:
        a, b = rng.randint(len(free_i), size=2)
        si, sj = int(free_i[a]), int(free_j[a])
        gi, gj = int(free_i[b]), int(free_j[b])
        dist = dfield(jnp.asarray(blocked), jnp.asarray([gi, gj]))
        optimal = float(dist[si, sj])
        # unreachable = the wavefront's FINITE sentinel (~7.5e37), NOT inf —
        # np.isfinite would pass it; same guard as worlds.distant_endpoints
        if optimal > 1e30 or optimal < 60.0:  # skip unreachable/trivial
            continue
        # MovingAI columns: bucket map width height start_x start_y goal_x goal_y optimal
        lines.append(
            f"{len(lines)}\t{map_name}\t{SIZE}\t{SIZE}\t{sj}\t{si}\t{gj}\t{gi}\t"
            f"{optimal:.8f}"
        )
    return lines


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="assets/movingai")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--scens", type=int, default=20)
    parser.add_argument("--name", default="city_0_256")
    args = parser.parse_args()

    blocked = city_grid(args.seed)
    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    map_path = out / f"{args.name}.map"
    rows = ["".join("@" if c else "." for c in row) for row in blocked]
    map_path.write_text(
        f"type octile\nheight {SIZE}\nwidth {SIZE}\nmap\n" + "\n".join(rows) + "\n"
    )
    print(f"{map_path}: {(~blocked).mean() * 100:.1f}% free")

    scen_path = out / f"{args.name}.map.scen"
    entries = make_scen_entries(blocked, f"{args.name}.map", args.scens, args.seed)
    scen_path.write_text("version 1\n" + "\n".join(entries) + "\n")
    print(f"{scen_path}: {len(entries)} scenarios")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
