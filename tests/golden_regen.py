"""Regenerates the golden parity trajectories in tests/golden/.

Run from the repo root on the CPU/fp64 test environment (the same
environment tests/conftest.py sets up):

    python tests/golden_regen.py

Only regenerate after an INTENTIONAL numerical change, and check the final
error columns against docs/parity_data (the reference side-by-side runs)
before committing -- the FINAL_GATES in test_parity.py exist to catch a
regeneration that papers over a real accuracy regression.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import conftest  # noqa: F401  (forces CPU platform + fp64 before jax init)
from test_parity import GOLDEN_DIR, PARITY_CASES, run_case


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for case, subdir, module, argv, columns, _gates in PARITY_CASES:
        rows = run_case(subdir, module, argv)
        path = os.path.join(GOLDEN_DIR, case + ".csv")
        keep = ["epoch"] + columns
        with open(path, "w") as f:
            f.write(",".join(keep) + "\n")
            for r in rows:
                f.write(",".join(str(r[c]) for c in keep) + "\n")
        print(f"{case}: {len(rows)} rows -> {path} (final: "
              + ", ".join(f"{c}={rows[-1][c]}" for c in columns) + ")")


if __name__ == "__main__":
    main()
