"""Focused head-to-head: PIP tile fraction 0.25 vs 0.18 (both at the
shipped nparts=2x), alternating reps."""

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
    res = {"f25": [], "f18": []}
    for rep in range(reps):
        for name, f in (("f25", 0.25), ("f18", 0.18)):
            r = run(f, CPUS * 2)
            if r:
                res[name].append(r["bps"])
            print(rep, name, r, flush=True)
    print({k: (max(v), sorted(v)) for k, v in res.items()})
    json.dump(
        res,
        open(os.path.join(REPO, "bench_runs", "r8_geo_ab_frac.json"), "w"),
        indent=1,
    )


if __name__ == "__main__":
    main()
