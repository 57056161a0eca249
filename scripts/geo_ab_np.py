"""Focused head-to-head: compute_k packing nparts 4x vs 2x cores,
alternating reps (see scripts/geo_ab.py for the grid version)."""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from geo_ab import CPUS, burn, run  # noqa: E402


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    burn(45)
    res = {"np4x": [], "np2x": []}
    for rep in range(reps):
        for name, np_ in (("np4x", CPUS * 4), ("np2x", CPUS * 2)):
            r = run(0.25, np_)
            if r:
                res[name].append(r["bps"])
            print(rep, name, r, flush=True)
    print({k: (max(v), sorted(v)) for k, v in res.items()})
    json.dump(
        res,
        open(os.path.join(REPO, "bench_runs", "r8_geo_ab_np.json"), "w"),
        indent=1,
    )


if __name__ == "__main__":
    main()
