"""Generate the vendored `data/2d-10c.arff` fixture: a 2-D, 10-cluster
dataset in the style of the clustering-benchmark `artificial/2d-10c`
set the reference's tests download over HTTP
(MempryVectorIndex.Tests/MemoryVectorIndexTests.cs:116-134,
VectorIndex.MainTest/Program.cs:183-260). The container has no
network, so the fixture is generated offline, deterministically, and
committed: 10 Gaussian clusters of UNEVEN size and spread (sizes
60-400, sigmas 0.4-2.1) on a ~[0, 30]^2 canvas — deliberately NOT
normalized to [-1, 1], which is exactly the reference's "bad
distribution, probably not normalized" degraded case
(MemoryVectorIndexTests.cs:95-113).

Usage: python tools/gen_arff.py   (rewrites data/2d-10c.arff)
"""

from __future__ import annotations

import os
import random

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "data", "2d-10c.arff")

CLUSTERS = [
    # (cx, cy, sigma, n)
    (3.0, 4.0, 0.6, 240),
    (8.5, 3.2, 0.4, 120),
    (14.0, 5.5, 1.1, 400),
    (22.0, 4.0, 0.8, 180),
    (27.5, 8.0, 0.5, 60),
    (5.0, 14.0, 1.6, 320),
    (12.5, 16.5, 0.7, 150),
    (20.0, 15.0, 2.1, 380),
    (26.0, 20.0, 0.9, 140),
    (9.0, 24.5, 1.3, 260),
]


def main() -> None:
    rng = random.Random(20260814)
    rows = []
    for label, (cx, cy, sig, n) in enumerate(CLUSTERS):
        for _ in range(n):
            rows.append((rng.gauss(cx, sig), rng.gauss(cy, sig), label))
    rng.shuffle(rows)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        f.write("% 2d-10c analog: 10 uneven gaussian clusters, unnormalized\n")
        f.write("% generated offline by tools/gen_arff.py (seed 20260814)\n")
        f.write("@RELATION 2d-10c-analog\n\n")
        f.write("@ATTRIBUTE x NUMERIC\n")
        f.write("@ATTRIBUTE y NUMERIC\n")
        f.write("@ATTRIBUTE class {0,1,2,3,4,5,6,7,8,9}\n\n")
        f.write("@DATA\n")
        for x, y, label in rows:
            f.write(f"{x:.6f},{y:.6f},{label}\n")
    print(f"wrote {OUT}: {len(rows)} rows")


if __name__ == "__main__":
    main()
