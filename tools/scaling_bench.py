"""Two-cluster-size scaling evidence (north rule: >=0.8 efficiency at
N -> 4N). No real cluster exists in this sandbox, so the same job runs
at two parallelism levels (local[N] and local[4N]) in fresh JVMs over
the same deterministic input; efficiency = throughput_4N / (4 * throughput_N).

Usage: python tools/scaling_bench.py [n_small] [n_large] [n_turns]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def run(cpus: int, n_turns: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "scaling_run.py"), str(cpus), str(n_turns)],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_large = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    n_turns = int(sys.argv[3]) if len(sys.argv) > 3 else 400_000
    a = run(n_small, n_turns)
    print(json.dumps(a))
    b = run(n_large, n_turns)
    print(json.dumps(b))
    factor = n_large / n_small
    eff_build = b["build_turns_per_sec"] / (factor * a["build_turns_per_sec"])
    eff_query = b["queries_per_sec"] / (factor * a["queries_per_sec"])
    print(
        json.dumps(
            {
                "pair": f"local[{n_small}] -> local[{n_large}]",
                "n_turns": n_turns,
                "build_eff": round(eff_build, 3),
                "query_eff": round(eff_query, 3),
                "build_speedup": round(
                    b["build_turns_per_sec"] / a["build_turns_per_sec"], 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
